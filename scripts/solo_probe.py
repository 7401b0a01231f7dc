"""Solo-probe named queries at sf0.1 per the VERDICT r11 task-1 protocol:
sf0.001 plan warm, one untimed sf0.1 priming run, then median-of-5 timing."""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from elevate_data_pipeline_spark.session import get_spark
from elevate_data_pipeline_spark.queries import QUERIES
from bench import shuffle_probe

names = sys.argv[1:]
spark = get_spark("solo-probe")
sf_dir = "/root/testdata/sf0.1"
warm_dir = "/root/testdata/sf0.001"
out = {}
probe = shuffle_probe(spark)
for name in names:
    QUERIES[name](spark, warm_dir).collect()
    QUERIES[name](spark, sf_dir).collect()  # untimed prime at scale
    samples = []
    for _ in range(5):
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).collect()
        samples.append(time.perf_counter() - t0)
    samples.sort()
    out[name] = {"median": round(samples[2], 3), "all": [round(s, 3) for s in samples]}
print(json.dumps({"probe_sec": round(probe, 4), "queries": out}))
