"""sf1 A/B of the hyperplane-signature implementation (VERDICT r15 #6):
argv[1] = arrow|fold. Times the registered embedding_lsh_near_dup and
the lsh_bands build at the sf1 corpus, prints a JSON line with timings
and an order-independent result checksum."""
import json, sys, time
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")
import oracle_sf1
oracle_sf1.generate(oracle_sf1.SF1_DIR)
from pyspark.sql import Column, functions as F
from data_warehouse_implementation_spark.session import get_spark, load_tables
from data_warehouse_implementation_spark.operators import similarity
from data_warehouse_implementation_spark.plans import materialize

variant = sys.argv[1]
if variant == "fold":
    def hyperplane_signature(vectors, n_bits=16, id_col="vec_id", vec_col="embedding", sig_col="hypersig"):
        if not 1 <= n_bits <= 64:
            raise ValueError(f"n_bits must be in 1..64, got {n_bits}")
        q = F.transform(F.col(vec_col).cast("array<double>"),
                        lambda x: F.round(x * similarity.HYPERPLANE_SCALE).cast("long"))
        base = vectors.select(F.col(id_col), q.alias("_q"))
        def proj(i):
            w = F.transform(F.sequence(F.lit(0), F.size("_q") - 1),
                            lambda j: (F.lit(i * 131 + 7) + j * 31) * F.lit(2654435761) % 97 - 48)
            return F.aggregate(F.zip_with(F.col("_q"), w, lambda a, b: a * b),
                               F.lit(0).cast("long"), lambda acc, x: acc + x)
        bit_terms = [F.when(proj(i) >= 0, F.shiftleft(F.lit(1).cast("long"), i))
                     .otherwise(F.lit(0).cast("long")) for i in range(n_bits)]
        sig = sum(bit_terms[1:], bit_terms[0]).cast("long")
        return base.select(id_col, sig.alias(sig_col))
    similarity.hyperplane_signature = hyperplane_signature

from data_warehouse_implementation_spark import registry
spark = get_spark(app_name=f"ab-lsh-{variant}")
spark.sparkContext.setLogLevel("ERROR")
t = load_tables(spark, oracle_sf1.SF1_DIR)
t["embeddings"].groupBy().count().collect()  # neutral warm
qs = registry.queries()
out = {"variant": variant}
b0 = len(materialize.BUILD_LOG)
t0 = time.perf_counter()
df = qs["embedding_lsh_near_dup"](spark, oracle_sf1.SF1_DIR)
n = df.count()
out["wall"] = round(time.perf_counter() - t0, 3)
out["rows"] = n
out["builds"] = [(nm, round(s, 3)) for nm, s in zip(materialize.BUILD_LOG[b0:], materialize.BUILD_SECONDS[b0:])]
# order-independent value checksum over all result columns
df2 = qs["embedding_lsh_near_dup"](spark, oracle_sf1.SF1_DIR)
chk = df2.select(F.xxhash64(*[F.col(c).cast("string") for c in sorted(df2.columns)]).alias("h")).agg(F.sum(F.col("h").cast("decimal(38,0)"))).collect()[0][0]
out["checksum"] = str(chk)
# repeat timing warm (caches built)
t0 = time.perf_counter()
qs["embedding_lsh_near_dup"](spark, oracle_sf1.SF1_DIR).count()
out["warm"] = round(time.perf_counter() - t0, 3)
print(json.dumps(out))
spark.stop()
