"""Second, longer timing pass for the q22 nv-from-uc A/B (equality was
proven in ab_q22_nv_from_uc.py at all three SFs). 3 warm + 9 timed
interleaved reps per layout, plus a runtime stage-reuse census: the win
mechanism is AQE shuffle-stage reuse of uc's by-term exchange, invisible
in the static plan — count executed jobs/stages via the status tracker.
"""
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools/slope_runs/r15opt3")

from ab_q22_nv_from_uc import NEW, OLD, release_pins, get_session  # noqa: E402

spark = get_session("ab-q22-time2")
sc = spark.sparkContext


def timed(fn, sf):
    t0 = time.time()
    fn(spark, sf).write.format("noop").mode("overwrite").save()
    release_pins(spark)
    return time.time() - t0


# Runtime stage census (fresh job-group bounds via job ids).
st = sc.statusTracker()
for tag, fn in (("old", OLD), ("new", NEW)):
    before = set(st.getJobIdsForGroup(None) or [])
    fn(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
    release_pins(spark)
    after = set(st.getJobIdsForGroup(None) or [])
    jobs = sorted(after - before)
    ntasks = 0
    nstages = 0
    for j in jobs:
        info = st.getJobInfo(j)
        if info is None:
            continue
        for s in info.stageIds:
            si = st.getStageInfo(s)
            if si is not None:
                nstages += 1
                ntasks += si.numTasks
    print(f"{tag}: jobs {len(jobs)} stages {nstages} tasks {ntasks}",
          flush=True)

for sf in ("/root/testdata/sf0.1",
           "/root/repo/spark-warehouse/sf0.1-multifile"):
    for _ in range(3):
        timed(OLD, sf); timed(NEW, sf)
    olds, news = [], []
    for _ in range(9):
        olds.append(timed(OLD, sf))
        news.append(timed(NEW, sf))
    print(f"{sf}\n  old {['%.2f' % t for t in olds]} med {statistics.median(olds):.2f} min {min(olds):.2f}"
          f"\n  new {['%.2f' % t for t in news]} med {statistics.median(news):.2f} min {min(news):.2f}",
          flush=True)
