"""Split each bench query's warm wall into (plan construction, execution):
construction = gate function call (no action), execution = noop write.
Writes tools/construct_split.json. Usage: python tools/construct_split.py [q...]"""
import sys, time, json
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from cdk_datalake_ingest_spark.session import get_spark
from cdk_datalake_ingest_spark import queries as Q
from bench import bench_queries

sf = "/root/testdata/sf0.1"
spark = get_spark(app_name="construct_split")
spark.sparkContext.setLogLevel("ERROR")
names = sys.argv[1:] or bench_queries()
out = {}
for name in names:
    fn = Q.QUERIES[name]
    try:
        fn(spark, sf).write.format("noop").mode("overwrite").save()  # warm
        t0 = time.time(); df = fn(spark, sf); t1 = time.time()
        df.write.format("noop").mode("overwrite").save(); t2 = time.time()
        out[name] = {"construct": round(t1-t0,3), "execute": round(t2-t1,3)}
    except Exception as ex:
        out[name] = {"error": str(ex)[:200]}
    print(name, out[name], flush=True)
json.dump(out, open("tools/construct_split.json","w"), indent=1, sort_keys=True)
tot_c = sum(v.get("construct",0) for v in out.values())
tot_e = sum(v.get("execute",0) for v in out.values())
print(f"TOTAL construct={tot_c:.1f}s execute={tot_e:.1f}s")
