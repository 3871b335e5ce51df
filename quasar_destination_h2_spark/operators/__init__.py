"""[EXT] Operator implementations beyond the reference surface.

The reference (`/root/reference/`, a load connector delegating SQL to
embedded H2) has none of these; they are the north-star LLM-pipeline
extensions from SURVEY §2.3: deduplication (exact / MinHash-LSH /
SimHash / n-gram Jaccard), similarity search over embeddings, text
analysis, document fingerprinting, sketches, and multimodal binary
column plumbing. All are Spark-native DataFrame compositions — no
row-at-a-time Python UDFs; pandas (Arrow) UDFs only where per-cell
binary decode genuinely requires Python (multimodal).
"""
