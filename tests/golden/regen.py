"""Regenerate golden digests after an INTENTIONAL semantic change."""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from test_golden_digests import GOLD, compute_digests  # noqa: E402

with open(GOLD, "w") as f:
    json.dump(compute_digests(), f, indent=1, sort_keys=True)
print(open(GOLD).read())
