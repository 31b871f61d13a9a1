"""Collect the round-2 chip-queue results from /tmp/q*_*.log into one table.

Each queue run writes its harness stdout to /tmp/q{,2,3,4,5}_<name>.log; the
harnesses print JSON lines. This prints a name -> parsed-JSON summary (last
JSON line per file plus any intermediate ones), ready to paste into
RESULTS.md after a queue drains.
"""
import glob
import json
import os


def main():
    rows = []
    paths = sorted(set(glob.glob("/tmp/q_*.log"))
                   | set(glob.glob("/tmp/q[0-9]_*.log"))
                   | set(glob.glob("/tmp/q[0-9][0-9]_*.log")))
    for path in paths:
        name = os.path.basename(path)[:-4]
        jsons = []
        try:
            with open(path) as f:
                for line in f:
                    line = line.strip()
                    if line.startswith("{") and line.endswith("}"):
                        try:
                            jsons.append(json.loads(line))
                        except json.JSONDecodeError:
                            pass
        except OSError:
            continue
        if jsons:
            rows.append((name, jsons))
        else:
            with open(path) as f:
                tail = f.readlines()[-1:]
            rows.append((name, [{"no_json_tail": (tail[0].strip()[:120]
                                                  if tail else "<empty>")}]))
    for name, jsons in rows:
        print(f"== {name}")
        for j in jsons:
            print("  ", json.dumps(j))


if __name__ == "__main__":
    main()
