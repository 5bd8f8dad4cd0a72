"""Loop a host probe every ~50 s; when the host is QUIET (matmul < 1 s
and first-touch fault < 1 s — the round-4 thresholds), exec the given
command and exit with its status. Exits 3 if the budget runs out first.

Usage: python tools/wait_quiet.py <budget_sec> -- cmd arg...
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
    budget = float(sys.argv[1])
    cmd = sys.argv[sys.argv.index("--") + 1 :]
    t_end = time.time() + budget
    while time.time() < t_end:
        m, f = probe()
        print(f"probe matmul={m:.2f} fault={f:.2f}", file=sys.stderr, flush=True)
        if m < 1.0 and f < 1.0:
            return subprocess.call(cmd)
        time.sleep(50)
    return 3


if __name__ == "__main__":
    sys.exit(main())
