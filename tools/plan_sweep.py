import sys, json
sys.path.insert(0, "/root/repo")
from sdu_hadoop_indexer_spark.registry import all_queries
from sdu_hadoop_indexer_spark.session import get_spark

spark = get_spark("plan-sweep")
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.1"
rows = []
for name, fn in sorted(all_queries().items()):
    try:
        df = fn(spark, sf)
        p = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        rows.append({
            "name": name,
            "exch": p.count("Exchange ("),
            "joins": sum(p.count(k) for k in ("SortMergeJoin (", "ShuffledHashJoin (", "BroadcastHashJoin (", "BroadcastNestedLoopJoin (", "CartesianProduct (")),
            "pyrow": p.count("BatchEvalPython"),
            "pyarrow": p.count("ArrowEvalPython") + p.count("MapInPandas") + p.count("FlatMapGroupsInPandas") + p.count("MapInArrow"),
            "lines": p.count("\n"),
        })
    except Exception as ex:
        rows.append({"name": name, "err": str(ex)[:80]})
json.dump(rows, open("/tmp/plan_sweep.json", "w"))
bad = [r for r in rows if r.get("pyrow", 0) > 0]
big = sorted([r for r in rows if "lines" in r], key=lambda r: -r["lines"])[:12]
many_exch = sorted([r for r in rows if "exch" in r], key=lambda r: -r["exch"])[:12]
errs = [r for r in rows if "err" in r]
print("total:", len(rows), "| BatchEvalPython (row-at-a-time Python):", len(bad), [r["name"] for r in bad])
print("errors:", errs)
print("largest plans:", [(r["name"], r["lines"]) for r in big])
print("most exchanges:", [(r["name"], r["exch"]) for r in many_exch])
