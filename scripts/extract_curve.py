"""Extract the (epoch, train NMSE, total, test loss) curve from a training
log into a CSV evidence artifact.

Usage: python scripts/extract_curve.py <logfile> <out.csv>
"""

from __future__ import annotations

import csv
import re
import sys


def main() -> None:
    log, out = sys.argv[1], sys.argv[2]
    text = open(log).read()
    pat = re.compile(
        r"Epoch: (\d+) / \d+, \s*\nTotal train Loss : ([\d.eE+-]+)\s*\n"
        r"MSE train Loss : ([\d.eE+-]+) \s*\nTest Loss : ([\d.eE+-]+)"
    )
    rows = {}
    for m in pat.finditer(text):  # restarts overwrite duplicate epochs
        rows[int(m.group(1))] = [float(m.group(i)) for i in (2, 3, 4)]
    with open(out, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["epoch", "train_total", "train_nmse", "test_loss"])
        for e in sorted(rows):
            w.writerow([e] + rows[e])
    print(f"{len(rows)} epochs -> {out}")


if __name__ == "__main__":
    main()
