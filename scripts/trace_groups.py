"""Group device-trace op time by category: conv-MXU vs reduce vs elementwise.

Perf tool: reads the newest trace dir produced by scripts/trace_ops.py (or
takes a trace.json.gz path) and buckets XLA ops to show where a train step's
device time goes — MXU convolutions, BN-style reductions, data movement.
"""

import glob
import gzip
import json
import re
import sys

path = sys.argv[1]
files = glob.glob(path) if path.endswith(".gz") else glob.glob(
    path + "/plugins/profile/*/*.trace.json.gz")
data = json.loads(gzip.open(sorted(files)[-1]).read())
events = data.get("traceEvents", [])

pid_names = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pid_names[e["pid"]] = e.get("args", {}).get("name", "")
device_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device:" in n}

buckets = {}
total = 0.0
for e in events:
    if e.get("ph") != "X" or e.get("pid") not in device_pids:
        continue
    name = e.get("name", "?")
    base = name.split(".")[0]
    hint = e.get("args", {}).get("long_name", "")
    if base in ("jit_step",) or re.fullmatch(r"\d+", base):
        continue  # program/step envelope events
    dur = e.get("dur", 0) / 1e3
    if "convolution" in base or "conv" in hint[:200] and "fusion" in base:
        cat = "convolution"
    elif "reduce" in base:
        cat = "reduce (BN stats etc.)"
    elif base in ("copy", "transpose", "bitcast", "reshape"):
        cat = "data movement"
    elif "select_and_scatter" in base:
        cat = "select_and_scatter"
    elif "dynamic" in base or "gather" in base or "scatter" in base:
        cat = "gather/scatter"
    elif "fusion" in base:
        # classify by output/operand hints
        if re.search(r"f32\[3,3,\d+,\d+\]|f32\[1,1,\d+,\d+\]", hint):
            cat = "conv wgrad fusion"
        else:
            cat = "other fusion (elementwise)"
    else:
        cat = base
    b = buckets.setdefault(cat, [0.0, 0])
    b[0] += dur
    b[1] += 1
    total += dur

print(f"total leaf device time: {total:.1f} ms over trace")
for cat, (ms, cnt) in sorted(buckets.items(), key=lambda kv: -kv[1][0]):
    print(f"{ms:9.2f} ms  {100*ms/total:5.1f}%  {cnt:5d} ops  {cat}")
