"""Stub child for bench.py parent-logic tests (GANLAB_BENCH_CHILD_STUB).

Emits canned child output per dispatch mode, driven by the
GANLAB_BENCH_STUB_SPEC env var: a JSON object mapping mode name to one of

    "ok:<median>"        full 5-window result at the given img/s
    "fail"               exit(1) like a crashed child
    "hang:<w1>,<w2>"     stream the given windows then sleep past the
                         (test-shrunk) child timeout -> salvaged partial
"""

import json
import os
import sys
import time

mode = sys.argv[1]
spec = json.loads(os.environ["GANLAB_BENCH_STUB_SPEC"])[mode]
print("CHILD_RECIPE pen16-seq", flush=True)

if spec == "fail":
    print("stub child crash", file=sys.stderr)
    sys.exit(1)

if spec.startswith("hang:"):
    for w in spec[len("hang:"):].split(","):
        print(f"CHILD_WINDOW {float(w):.2f}", flush=True)
    time.sleep(60)
    sys.exit(0)

median = float(spec[len("ok:"):])
windows = [median - 2, median - 1, median, median + 1, median + 2]
for w in windows:
    print(f"CHILD_WINDOW {w:.2f}", flush=True)
result = {
    "median": median,
    "windows_img_s": [round(w, 1) for w in windows],
    "window_min_max": [round(min(windows), 1), round(max(windows), 1)],
    "batch": 32,
    "dispatch": mode,
    "modes": {mode: {"median": median}},
    "recipe": "pen16-seq",
}
print("CHILD_RESULT " + json.dumps(result), flush=True)
