"""Run-dir naming + logging, mirroring the reference's observable contract.

The reference encodes hyperparameters into directory names and logs through the
root logger to file + stdout (reference: utils.py:19-32, methods/regress.py:206,
methods/calibrate_network.py:187-188). Bundled result logs double as golden
fixtures, so the log-line formats here are part of the compatibility surface.
"""

from __future__ import annotations

import logging
import sys


def setup_logger(log_path: str) -> None:
    """Attach file + stdout handlers to the root logger (utils.py:19-32)."""
    fmt = logging.Formatter("%(asctime)s [%(levelname)-5.5s]  %(message)s")
    root = logging.getLogger()
    root.setLevel(logging.INFO)

    # idempotent across pipeline stages in one process (the reference, being
    # one process per stage, just stacks handlers)
    for h in list(root.handlers):
        if isinstance(h, (logging.FileHandler, logging.StreamHandler)):
            root.removeHandler(h)

    fh = logging.FileHandler(log_path, encoding="utf-8")
    fh.setFormatter(fmt)
    root.addHandler(fh)

    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    root.addHandler(sh)

    logging.info("Logging file is %s" % log_path)


def round_tensor(x, num: int = 2, group_str: bool = False) -> str:
    """Pretty-print an array the way eval log lines expect (utils.py:66-76)."""
    import numpy as np

    x = np.asarray(x)
    if group_str:
        rows = []
        for i in range(x.shape[0]):
            rows.append(",".join(str(round(float(v), num)) for v in x[i].ravel()))
        return "/".join(rows)
    return ",".join(str(round(float(v), num)) for v in x.ravel())


# Alias with the reference's spelling so ported user scripts keep working.
RoundTensor = round_tensor
