"""Attribute per-gate wall into (plan construction, execution) and
cProfile the construction phase. Usage: python tools/attr_gap.py q1 q2..."""
import sys, time, cProfile, pstats, io
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from cdk_datalake_ingest_spark.session import get_spark
from cdk_datalake_ingest_spark import queries as Q

sf = "/root/testdata/sf0.1"
spark = get_spark(app_name="attr")
spark.sparkContext.setLogLevel("ERROR")
names = sys.argv[1:]
for name in names:
    fn = Q.QUERIES[name]
    # warm once
    fn(spark, sf).write.format("noop").mode("overwrite").save()
    t0 = time.time(); df = fn(spark, sf); t1 = time.time()
    df.write.format("noop").mode("overwrite").save(); t2 = time.time()
    print(f"{name}: construct={t1-t0:.3f}s execute={t2-t1:.3f}s")
    pr = cProfile.Profile(); pr.enable(); df2 = fn(spark, sf); pr.disable()
    s = io.StringIO(); ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
    ps.print_stats(18); lines = s.getvalue().splitlines()
    print("\n".join(lines[4:28])); print("="*70)
