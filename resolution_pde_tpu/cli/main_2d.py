"""2D training driver (reference main_2d.py:37-325).

Differences from the 1D driver mirrored from the reference: StepLR(30, 0.5)
instead of cosine (main_2d.py:173-174), no rollout eval, data parallelism
over the full device mesh instead of nn.DataParallel (main_2d.py:146-149 —
here batches shard over the "data" axis and XLA handles the collectives).
"""

from __future__ import annotations

import sys

from resolution_pde_tpu.cli.main_1d import main as _main


def main(argv=None):
    argv = list(argv if argv is not None else sys.argv[1:])
    if not any(a.startswith("training.scheduler=") for a in argv):
        argv.append("training.scheduler=step")
    if not any(a.startswith("dataset=") for a in argv):
        argv.append("dataset=ns_naive")
    if not any(a.startswith("model=") for a in argv):
        argv.append("model=ffno_2d")
    return _main(argv, spatial_ndim=2)


if __name__ == "__main__":
    main()
