"""Summarize a queued chip session's logs into one compact report.

The tunnel-outage protocol (tools/tunnel_watch.sh → tools/chip_session_r2.sh)
writes one log per experiment under /tmp/chip_r2/.  This collects the
decision-relevant tail of each — JSON lines, result tables, cosine/rate
markers, tracebacks — so results can be folded into BACKLOG/PARITY/BENCH
quickly (and survives /tmp cleanup when archived into the repo by the
queue's final step).

Usage: python tools/summarize_chip_session.py [--dir /tmp/chip_r2]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import re

# lines worth keeping verbatim: metrics, rates, cosines, verdicts, errors
_KEEP = re.compile(
    r"(\{\"|seq/s|seqs/s|pairs/s|ms/step|ms/call|TF/s|MFU|mfu|cosine|"
    r"restore_acc|acc=|p50|p99|PASS|CRASH|TIMEOUT|REPRO-OK|Error|error:|"
    r"Traceback|assert|drift|delta|rows=|ff_quant|proj_quant|int8|"
    r"throughput|latency|=== |--- )"
)
_NOISE = re.compile(
    r"(WARNING|Platform 'axon'|warnings\.warn|FutureWarning|^\s*$|^\+ )"
)


def summarize(log: pathlib.Path, max_lines: int = 40) -> list[str]:
    try:
        lines = log.read_text(errors="replace").splitlines()
    except OSError as e:
        return [f"<unreadable: {e}>"]
    kept = [ln.rstrip() for ln in lines
            if _KEEP.search(ln) and not _NOISE.search(ln)]
    if not kept:
        kept = [ln.rstrip() for ln in lines[-5:] if ln.strip()]
    if len(kept) > max_lines:
        kept = kept[:10] + [f"... ({len(kept) - 20} lines elided) ..."] + kept[-10:]
    return kept


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/chip_r2")
    ap.add_argument("--json", action="store_true",
                    help="emit one JSON object instead of text")
    args = ap.parse_args()
    root = pathlib.Path(args.dir)
    logs = sorted(root.glob("*.log"))
    if not logs:
        print(f"no logs under {root}")
        return
    report = {}
    for log in logs:
        report[log.name] = summarize(log)
    if args.json:
        print(json.dumps(report, indent=1))
        return
    for name, lines in report.items():
        print(f"\n===== {name} =====")
        for ln in lines:
            print("  " + ln)


if __name__ == "__main__":
    main()
