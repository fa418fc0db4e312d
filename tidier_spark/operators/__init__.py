"""Extension operators for large-scale training-data pipelines.

Not present in the reference (extension scope — SURVEY.md §2.3 last row):
deduplication (exact + MinHash/SimHash near-dup), similarity search over
embeddings, text analysis, and multimodal column plumbing.  Every operator
is a declarative DataFrame transform designed for 100 TB inputs: no
``collect``, no driver-side loops, aggregate/join shuffles only on
explicitly chosen keys, LSH-style banding to avoid quadratic joins.
"""

from . import dedup, multimodal, similarity, sketches, text  # noqa: F401
