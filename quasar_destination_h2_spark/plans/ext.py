"""[EXT] North-star extension catalog (SURVEY §2.3).

LLM-data-pipeline operators beyond the reference's own surface:
deduplication (exact hash, MinHash-LSH, SimHash, inverted-index
n-gram Jaccard), similarity search over embeddings (brute-force
cosine top-k baseline + LSH-bucketed scale path), text analysis
(language ID, quality scoring, token counting, fingerprinting),
approximate sketches, and multimodal binary-column plumbing.

The real operator implementations live in ``..operators``; this
module registers the conformance queries (oracle-paired where the
semantics are SQL-expressible, rows-only otherwise).
"""

from __future__ import annotations

# Populated incrementally — see operators/ for implementations.
