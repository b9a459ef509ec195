"""q4 old vs known-keys at the 25x fixture (events = 2.5M rows)."""
import os, sys, time
_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ab_q4_phase import old_body, known_body, timed
from dataflow_pubsub_message_encryption_spark.session import get_session

SF = "/tmp/sparkgraft-sf2.5"
REPS = int(os.environ.get("REPS", "4"))
spark = get_session("ab-q4-25x")
for _ in range(2):
    timed(old_body, spark, SF); timed(known_body, spark, SF)
old, new = [], []
for _ in range(REPS):
    old.append(timed(old_body, spark, SF))
    new.append(timed(known_body, spark, SF))
print(f"25x old: med {sorted(old)[len(old)//2]:.3f} min {min(old):.3f} {[round(t,3) for t in old]}")
print(f"25x known: med {sorted(new)[len(new)//2]:.3f} min {min(new):.3f} {[round(t,3) for t in new]}")
spark.stop()
