"""raykg — a from-scratch Ray-Data-native knowledge-graph construction engine.

Capabilities mirror the reference `sophisid/cs562_sdpg` ("Schema Discovery for
Property Graphs", Scala/Spark — studied at /root/reference, not ported):

- triple extraction from interleaved text+media documents (reference analog:
  per-row pattern/instance extraction, src2/main/scala/DataToPattern.scala:11-51)
- stateful entity linking via an alias dictionary with MinHash-LSH blocking
  (reference analog: BucketedRandomProjectionLSH, src2/main/scala/LSH.scala:10-18)
- canonicalization via union-find over a groupby(entity_key) shuffle with
  salted hot keys (reference analog: cluster aggregate,
  src/main/scala/Clustering.scala:90-97)
- graph materialization into deduplicated node/edge tables (reference analog:
  edge-type dedup, src/main/scala/com/models/Pattern.scala:44-51)
- schema discovery: MinHash-LSH clustering of property-presence signatures,
  required/optional property derivation, edge-type integration, majority-label
  P/R/F1 evaluation (src/main/scala/Clustering.scala, ClusteringEvaluation.scala)

Everything is expressed Ray-Data-first: `ray.data.Dataset` pipelines of
`map_batches` over zero-copy Arrow batches, actor pools for stateful stages,
`groupby` shuffles only where semantics require an all-to-all exchange.

No module in this package calls ``ray.init()`` / ``ray.shutdown()`` — sessions
are owned by the caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.1.0"
