"""Aggregate-memory-bandwidth ceiling probe: the same numpy triad task
run 1-way, 8-way and 32-way concurrent (separate processes, no Ray).
If the box's DRAM saturates below 32 streams, NO bandwidth-bound op can
scale 8->32 on one node - the single-box efficiency floor is hardware."""
import json, os, subprocess, sys, time

CHILD = r'''
import numpy as np, time, sys
n = 40_000_000  # 320 MB per array, way past LLC
a = np.ones(n); b = np.ones(n); c = np.zeros(n)
t0 = time.perf_counter()
reps = 5
for _ in range(reps):
    c[:] = a + 2.5 * b   # STREAM triad: 3 arrays touched
dt = time.perf_counter() - t0
print((3 * 8 * n * reps) / dt / 1e9)  # GB/s this process
'''

def run(k):
    ps = [subprocess.Popen([sys.executable, "-c", CHILD],
                           stdout=subprocess.PIPE, text=True)
          for _ in range(k)]
    per = [float(p.communicate()[0].strip()) for p in ps]
    return sum(per), sum(per)/len(per)

for k in (1, 8, 32):
    tot, avg = run(k)
    print(json.dumps({"concurrency": k, "aggregate_GBps": round(tot, 1),
                      "per_proc_GBps": round(avg, 1)}))
