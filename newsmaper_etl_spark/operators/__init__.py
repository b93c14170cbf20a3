"""Reusable DataFrame→DataFrame operators.

Two families:

- reference-domain pipeline operators (newsmaper.py): tokenize/tag-country,
  date parsing/dim resolution, idempotent append, keep-first dedup —
  SURVEY.md §2/§3 semantics, ledger L1–L10 pinned.
- scale extensions (dedup.py, similarity.py, text.py, multimodal.py,
  asof.py): the LLM-training-data-pipeline surface (exact/MinHash/SimHash
  dedup, ANN search, text quality, binary media plumbing) plus join types
  Spark lacks natively (as-of).
"""
