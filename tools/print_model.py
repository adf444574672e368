#!/usr/bin/env python3
"""Human-readable adaptive-model dump (print-model.cc equivalent).

Reads a raw model file (LEPTON_COMPRESSION_MODEL_OUT format: the flat
branch arena, byte-compatible with the reference's struct Model) and
prints interesting branches, one per line:

    TABLE::dim[v]dim[v]... = (true_count, false_count-1)

Printability mirrors Model::debug_print (reference model.cc:230-380):
by default branches that are CLOSE_TO_50 or (with a second model)
CLOSE_TO_ONE_ANOTHER within --tolerance, having at least --min-samples
observations; --ok inverts to print the confidently-skewed branches.

Usage: print_model.py [-t<tol>] [-s<min>] [-ok] MODEL [OTHER_MODEL]
"""
import signal
import sys

import numpy as np

signal.signal(signal.SIGPIPE, signal.SIG_DFL)  # head-friendly

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from lepton_tpu.model.tables import (ARENA_SIZE, TABLE_OFFSETS,  # noqa: E402
                                     TABLE_SHAPES)

# (arena key, display name, dimension labels) in debug_print order
DISPLAY = [
    ("nz_7x7", "NONZERO 7x7", ["cmp", "nbr", "bit", "prevbits"]),
    ("nz_1x8", "NONZERO_1x8", ["cmp", "eobx", "num_nonzeros", "bit",
                               "prevbits"]),
    ("nz_8x1", "NONZERO_8x1", ["cmp", "eobx", "num_nonzeros", "bit",
                               "prevbits"]),
    ("exp_dc", "EXP_DC", ["len_abs_mxm", "len_abs_off", "bit"]),
    ("exp_7x7", "EXP7x7", ["cmp", "num_nonzeros", "coef", "neigh_exp",
                           "bit"]),
    ("exp_x", "EXP_8x1", ["cmp", "num_nonzeros", "coef", "neigh_exp",
                          "bit"]),
    ("residual_noise", "NOISE", ["cmp", "coef", "num_nonzeros", "bit"]),
    ("residual_noise_dc", "NOISE_DC", ["len_abs_mxm", "bit"]),
    ("residual_thresh", "THRESH8", ["cmp", "max", "exp", "prevbits"]),
    ("sign", "SIGN", ["cmp", "lakh", "exp"]),
]


def load(path):
    raw = np.fromfile(path, dtype=np.uint8)
    if raw.size != ARENA_SIZE * 3:
        sys.exit(f"{path}: expected {ARENA_SIZE * 3} bytes, "
                 f"got {raw.size}")
    return raw.reshape(ARENA_SIZE, 3)


def main(argv):
    tol = 0.25
    min_samples = 25
    mode = "close"
    paths = []
    for a in argv:
        if a.startswith("-t"):
            tol = float(a[2:])
        elif a == "-ok":
            mode = "ok"
        elif a.startswith("-s"):
            min_samples = int(float(a[2:]))
        else:
            paths.append(a)
    if not 1 <= len(paths) <= 2:
        sys.exit(__doc__)
    arena = load(paths[0])
    other = load(paths[1]) if len(paths) == 2 else None

    shapes = dict(TABLE_SHAPES)
    for key, name, labels in DISPLAY:
        shape = shapes[key]
        off = TABLE_OFFSETS[key]
        n = int(np.prod(shape))
        fc = arena[off:off + n, 0].astype(np.int64)
        tc = arena[off:off + n, 1].astype(np.int64)
        total = tc + fc
        ratio = (tc + 1) / (total + 2)
        if other is not None:
            ofc = other[off:off + n, 0].astype(np.int64)
            otc = other[off:off + n, 1].astype(np.int64)
            oratio = (otc + 1) / (otc + ofc + 2)
            close = np.abs(ratio - oratio) < tol
            nontrivial = (tc > 0) | (fc > 1)
        else:
            oratio = None
            close = np.abs(ratio - 0.5) < tol
            # (model.cc:246's >300 filter is dead code with uint8 counts;
            # the live gate is the nontrivial + min_samples pair below)
            nontrivial = (tc > 0) | (fc > 1)
        significant = total >= min_samples
        printable = nontrivial & significant & \
            (close if mode == "close" else ~close)
        for flat in np.nonzero(printable)[0]:
            idx = np.unravel_index(flat, shape)
            dims = "".join(f"{lb}[{v}]" for lb, v in
                           zip(labels, idx[:len(labels)]))
            extra = "".join(f"[{v}]" for v in idx[len(labels):])
            line = f"{name}::{dims}{extra} = ({tc[flat]}, {fc[flat] - 1})"
            if other is not None:
                line += f" = ({otc[flat]}, {ofc[flat] - 1}}}"
            print(line)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
