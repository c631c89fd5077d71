# dev smoke for operators — exec(open('scripts/smoke_ops.py').read())
import sys
for _n in [n for n in sys.modules if n.startswith('pandas_plus_spark')]:
    del sys.modules[_n]
import pandas_plus_spark.operators.dedup as dd
import pandas_plus_spark.operators.similarity as sim
import pandas_plus_spark.operators.multimodal as mm
import pandas_plus_spark.sources.tables as tb
import pyspark.sql.functions as F

t = tb.load_tables(spark, '/root/testdata/sf0.001')
docs, emb = t['documents'], t['embeddings']
print("docs", docs.count(), "emb", emb.count())

print("== exact dedup ==")
dd.exact_dedup(docs, 'text', 'doc_id').orderBy('keep_id').show(3)

print("== minhash sigs/cands/dedup ==")
sigs = dd.minhash_signatures(docs, 'text', 'doc_id', num_hashes=16)
sigs.select('id', F.slice('sig', 1, 3).alias('s3')).show(2, truncate=False)
cands = dd.minhash_lsh_candidates(sigs, bands=8)
print("candidates:", cands.count())
nd = dd.minhash_dedup(docs, 'text', 'doc_id', threshold=0.5, num_hashes=16, bands=8)
print("near-dups@0.5:", nd.count())

print("== brute jaccard ==")
bj = dd.ngram_jaccard_pairs(docs, 'text', 'doc_id', threshold=0.3)
print("brute pairs@0.3:", bj.count())
bj.orderBy(F.desc('jaccard')).show(3)

print("== simhash ==")
sh = dd.simhash(docs.limit(50), 'text', 'doc_id')
sh.show(3)
print("simhash cands:", dd.simhash_candidates(sh).count())

print("== knn ==")
q = emb.where(F.col('vec_id') < 5)
knn = sim.brute_force_knn(emb, q, k=3)
knn.orderBy('query_id', 'rank').show(6)

print("== cosine neardup ==")
print("pairs@0.8:", sim.cosine_neardup_pairs(emb, 0.8).count())

print("== lsh buckets ==")
sim.hyperplane_lsh_buckets(emb.limit(20), n_planes=8).show(3)

print("== multimodal ==")
blobs = docs.select('doc_id', F.encode('text', 'UTF-8').alias('blob'))
mm.attach_blob_metadata(blobs, 'blob', 'image', 'raw').select('doc_id', 'blob_meta').show(2)
mm.extract_image_features(blobs, 'blob', 'doc_id').show(3)
print("OPS OK")
