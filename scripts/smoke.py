"""Quick end-to-end smoke: fixture -> clusterbreak_spark -> recall vs oracle."""
import sys, time

sys.path.insert(0, "/root/repo")
from dynaalign_spark.config import PARITY
from dynaalign_spark.fixtures import make_images, images_df
from dynaalign_spark.session import get_spark
from dynaalign_spark.operators.clusterbreak import clusterbreak_spark
from dynaalign_spark import oracle

t0 = time.time()
spark = get_spark(master="local[8]")
rows, truth = make_images(n_clusters=15, seed=42)
print("rows:", len(rows), "t=%.1f" % (time.time() - t0))
df = images_df(spark, rows)
cfg = PARITY
res = clusterbreak_spark(df, cfg)
clusters = {r["image_id"]: r["cluster_id"] for r in res["clusters"].collect()}
filtered = [r["image_id"] for r in res["filtered"].collect()]
print("threshold:", res["threshold"], "cc_rounds:", res["cc_rounds"])
print("clustered:", len(clusters), "filtered:", len(filtered), "t=%.1f" % (time.time() - t0))

# oracle
texts = [r["caption"] for r in rows]
ids = [r["image_id"] for r in rows]
out, filt, itr, conv = oracle.clusterbreak(
    texts, ids, cfg.k, cfg.seeds, thresh_p=cfg.thresh_p,
    size_max=cfg.size_max, size_min=cfg.size_min, resolution=cfg.louvain_resolution)
print("oracle clustered:", len(out), "filtered:", len(filt), "itr:", itr)
rec = oracle.pair_recall(out, clusters)
prec = oracle.pair_recall(clusters, out)
print("recall: %.4f  precision: %.4f  t=%.1f" % (rec, prec, time.time() - t0))
spark.stop()
