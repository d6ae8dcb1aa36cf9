#!/usr/bin/env python3
"""Merge partial golden-board runs into GOLDEN.json (incremental board
updates: only scenes whose code paths changed get re-rendered)."""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    base = Path("GOLDEN.json")
    board = json.loads(base.read_text()) if base.exists() else {}
    for f in sys.argv[1:]:
        part = json.loads(Path(f).read_text())
        for k, v in part.items():
            if k == "_summary":
                continue
            board[k] = v
    counts = {"pass": 0, "fail": 0, "error": 0, "skip": 0,
              "known-deviation": 0, "standin": 0}
    for k, v in board.items():
        if k == "_summary" or not isinstance(v, dict):
            continue
        st = v.get("status", "error")
        counts[st] = counts.get(st, 0) + 1
    board["_summary"] = dict(
        passed=counts["pass"], failed=counts["fail"],
        errors=counts["error"], skipped=counts["skip"],
        known_deviation=counts["known-deviation"],
        standin=counts["standin"],
        total=sum(counts.values()))
    base.write_text(json.dumps(board, indent=1))
    print(json.dumps(board["_summary"]))


if __name__ == "__main__":
    main()
