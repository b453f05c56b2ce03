"""Interleaved A/B harness (r12 optimization rounds): the OLD
implementation of a declared query (materialized from `git archive
<ref>` into a temp tree) and the working-tree implementation alternate
noop-sink runs inside ONE SparkSession (old, new, old, new, ...) with
storage released between runs — host-band drift hits both arms
equally, which is the only way to resolve <20% deltas on a machine
whose throughput swings 2x between windows (BASELINE.md). Honors
SPARK_GRAFT_CPUS (rerun at 8 to unmask sort/duplicate-subtree wins
that 32 spare cores absorb).

Usage:
    python tools/ab_compare.py <query_name> [<git_ref>=HEAD] [<n_rounds>=5]
"""
import importlib, os, shutil, subprocess, sys, tempfile, time

name = sys.argv[1]
ref = sys.argv[2] if len(sys.argv) > 2 else "HEAD"
rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 5

# derive the repo root from this file's location (r12 ADVICE: the
# hardcoded /root/repo silently compared the wrong tree elsewhere)
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)
from pwir_zadanie_4_mapreduce_spark.session import build_session

# materialize the OLD repo tree at ref into a tempdir
tmp = tempfile.mkdtemp(prefix="oldtree_")
subprocess.run(
    f"git -C {REPO_ROOT} archive {ref} | tar -x -C {tmp}",
    shell=True, check=True,
)

spark = build_session(app_name="ab_generic", extra_conf={"spark.ui.showConsoleProgress": "false"})
from bench import _multifile_dir
sf_dir, _ = _multifile_dir(
    spark, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
)

import __spark_entry__ as entry_new
new_q = entry_new.queries()[name]

# import the old package under an alias path: swap sys.path, purge modules
def load_old():
    saved = dict(sys.modules)
    for m in list(sys.modules):
        if m.startswith("pwir_zadanie_4_mapreduce_spark") or m == "__spark_entry__":
            del sys.modules[m]
    sys.path.insert(0, tmp)
    import __spark_entry__ as entry_old
    fn = entry_old.queries()[name]
    sys.path.remove(tmp)
    for m in list(sys.modules):
        if m.startswith("pwir_zadanie_4_mapreduce_spark") or m == "__spark_entry__":
            del sys.modules[m]
    sys.modules.update(saved)
    return fn

old_q = load_old()

def release():
    spark.catalog.clearCache()
    try:
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()
    except Exception:
        pass

def noop(df): df.write.format("noop").mode("overwrite").save()

noop(old_q(spark, sf_dir))  # warm
res = {"old": [], "new": []}
for i in range(rounds):
    for tag, fn in (("old", old_q), ("new", new_q)):
        release()
        t0 = time.monotonic()
        noop(fn(spark, sf_dir))
        res[tag].append(round(time.monotonic() - t0, 3))
print("old:", res["old"], "min", min(res["old"]))
print("new:", res["new"], "min", min(res["new"]))
shutil.rmtree(tmp, ignore_errors=True)
spark.stop()
