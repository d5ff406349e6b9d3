"""crawler_spark — a from-scratch PySpark-native harvest frontier + fetch scheduler.

Re-expresses the semantics of clearlydefined/crawler (reference at
/root/reference, Node.js) as batch scheduling *epochs* over columnar
DataFrame state:

- the four weighted priority queues (immediate/soon/normal/later) become a
  single ``frontier`` table with a ``queue`` column and a deterministic
  window-ranking pop order per epoch,
- the per-traversal URL-seen set becomes a ``seen`` table guarded by
  partitioned Bloom filters + an exact anti-join verifier,
- fetchers become a deterministic join against a synthetic ``registry``
  dimension (no network in this sandbox),
- processors become column transforms + a broadcast visitor-map expansion
  join that feeds the frontier back,
- documents land as interleaved text+media span arrays
  (``array<struct<kind,text,media_ref,offset>>``).

Everything is DataFrame/SQL-first; Python reaches executors only through
vectorized Arrow/pandas UDFs (never per-row Python).
"""

__version__ = "0.1.0"
