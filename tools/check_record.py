"""Replay the driver's bench-record parse contract.

The per-round driver captures bench.py's stdout, keeps only the LAST
2000 CHARACTERS as `tail`, and parses the result JSON out of that tail
(BENCH_r{N}.json: {"tail": <2000 chars>, "parsed": <dict|null>}).
Round 4's result line grew past 2000 chars, the tail cut off its
front, and `parsed` came back null — the round's scaling and
incremental wins vanished from the official record.

This module replays that exact contract so bench output can be checked
BEFORE a round ends: `parse_driver_tail(stdout)` returns what the
driver would record.  tests/test_bench_record.py runs it against a
synthetically fat result through bench.emit_result; as a script it
checks a saved stdout capture:

    python tools/check_record.py <stdout-capture-file>
"""

from __future__ import annotations

import json
import sys

TAIL_CHARS = 2000


def parse_driver_tail(stdout: str) -> dict | None:
    """What the driver's 2000-char-tail parse would record.

    Mirrors the observed contract: take the last TAIL_CHARS characters,
    then find the last line that parses as a JSON object.  A line whose
    front was cut off by the tail window does not parse — that is the
    failure mode this guard exists for."""
    tail = stdout[-TAIL_CHARS:]
    for line in reversed(tail.splitlines()):
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            parsed = json.loads(line)
        except json.JSONDecodeError:
            continue
        if isinstance(parsed, dict):
            return parsed
    return None


def main(argv: list[str]) -> int:
    if len(argv) != 2:
        print(__doc__)
        return 2
    with open(argv[1]) as fh:
        stdout = fh.read()
    parsed = parse_driver_tail(stdout)
    if parsed is None:
        print("FAIL: the driver's 2000-char tail would record parsed: null")
        return 1
    missing = [k for k in ("metric", "value", "scaling") if k not in parsed]
    if missing:
        print(f"WARN: parsed but missing keys: {missing}")
    print(f"OK: parsed {len(parsed)} keys; metric={parsed.get('metric')} "
          f"value={parsed.get('value')} "
          f"scaling.efficiency={(parsed.get('scaling') or {}).get('efficiency')}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
