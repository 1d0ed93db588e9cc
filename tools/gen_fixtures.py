"""Generate the checked-in reference-shaped fixtures (FIXTURES.md §B).

Deterministic (seeded); run once, commit the output. The trace fixture
mirrors the Chrome-trace document shape of /root/reference/README.md:70-103
so the trace-analytics MVP exercises the exact reference pipeline.
"""

from __future__ import annotations

import json
import os
import random

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

OP_NAMES = [
    "ParseExample", "IteratorGetNext", "MatchingFiles", "Cast", "Identity",
    "ConcatV2", "GatherV2", "HashTableLookup", "StringToHashBucketFast",
    "RealDiv", "Sub", "Mul", "AddN", "MatMul", "Relu", "Sigmoid",
    "SparseSegmentSum", "UniqueV2", "Reshape", "Tile", "Pack", "Unpack",
    "Range", "Fill", "Slice", "StridedSlice", "Shape", "Pad", "Softmax",
    "ReadVariableOp",
]
PHASES = ["X", "B", "E", "M"]
CATS = ["Op", "DataFlow", "Memory"]


def gen_trace(path: str, n_docs: int = 50, events_per_doc: int = 200,
              seed: int = 42) -> None:
    rng = random.Random(seed)
    with open(path, "w") as f:
        for _ in range(n_docs):
            t = rng.randint(1_000_000, 2_000_000)
            events = []
            for _ in range(events_per_doc):
                t += rng.randint(1, 500)
                op = rng.choice(OP_NAMES)
                events.append({
                    "ph": rng.choice(PHASES),
                    "cat": rng.choice(CATS),
                    "name": f"{op}:{op}",
                    "pid": rng.randint(1, 4),
                    "tid": rng.randint(1, 16),
                    "ts": t,
                    "dur": rng.randint(1, 5000),
                    "args": {"name": op, "op": op},
                })
            f.write(json.dumps({"traceEvents": events}) + "\n")


if __name__ == "__main__":
    os.makedirs(os.path.join(REPO, "fixtures"), exist_ok=True)
    out = os.path.join(REPO, "fixtures", "trace_events.ndjson")
    gen_trace(out)
    print("wrote", out)
