"""Loop a host probe every ~50 s; when the host is QUIET (matmul < 1 s
and first-touch fault < 1 s — the round-4 thresholds), exec the given
command and exit with its status. Exits 3 if the budget runs out first.

Usage: python tools/wait_quiet.py <budget_sec> [threshold_sec] -- cmd arg...
(threshold defaults to 1.0; a relaxed threshold trades timing sharpness
for actually capturing a run — the probe embedded in every bench JSON
self-documents which you got.)
"""

from __future__ import annotations

import subprocess
import sys
import time


def probe() -> tuple[float, float]:
    import numpy as np

    t0 = time.time()
    a = np.random.rand(2000, 2000)
    _ = a @ a
    t1 = time.time()
    x = np.empty(64 * 1024 * 1024 // 8)
    x[::512] = 1.0
    t2 = time.time()
    return t1 - t0, t2 - t1


def main() -> int:
    sep = sys.argv.index("--")
    budget = float(sys.argv[1])
    thr = float(sys.argv[2]) if sep > 2 else 1.0
    cmd = sys.argv[sep + 1 :]
    t_end = time.time() + budget
    while time.time() < t_end:
        m, f = probe()
        print(f"probe matmul={m:.2f} fault={f:.2f}", file=sys.stderr, flush=True)
        if m < thr and f < thr:
            return subprocess.call(cmd)
        time.sleep(50)
    return 3


if __name__ == "__main__":
    sys.exit(main())
