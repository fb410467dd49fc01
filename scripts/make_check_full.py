#!/usr/bin/env python3
"""Assemble a CHECK_FULL_r{N}.json artifact from scripts/check.py text
output: `python3 scripts/make_check_full.py <round> <sf> <provenance> < check_output.txt`
"""
import json
import re
import sys

round_no, sf, provenance = int(sys.argv[1]), float(sys.argv[2]), sys.argv[3]
per = {}
for line in sys.stdin:
    m = re.match(r"(PASS|FAIL) (\S+)(?: \((\d+) rows\))?", line.strip())
    if m:
        status, name, rows = m.groups()
        per[name] = {"pass": status == "PASS"}
        if rows is not None:
            per[name]["rows"] = int(rows)
out = {
    "round": round_no,
    "sf": sf,
    "queries": len(per),
    "passed": sum(1 for v in per.values() if v["pass"]),
    "provenance": provenance,
    "per_query": dict(sorted(per.items())),
}
json.dump(out, sys.stdout, indent=1)
