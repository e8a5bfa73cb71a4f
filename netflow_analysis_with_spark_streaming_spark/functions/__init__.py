"""Column-level function library (engine extension surface).

- text.py: tokenization, shingles, md5-derived hashing, quality
  scoring, language-ID heuristics, fingerprints (SURVEY.md §2.9).
- vectors.py: embedding math (cosine, norms) and deterministic
  random-hyperplane LSH bucketing for ANN.
- multimodal.py: binary-column decode/feature plumbing (Arrow-batched
  pandas UDFs; decode stubbed, see module docstring).

Everything here is built from pyspark.sql.functions expressions unless
Python is genuinely required (multimodal batch decode) — UDFs are the
slow path (SURVEY.md §2.8).
"""
