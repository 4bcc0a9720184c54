#!/usr/bin/env python
"""Convert the released VGGish TF-slim checkpoint (+ PCA params) to the
framework's npz checkpoint format.

The reference's ``to_vggish_embedds`` loads ``vggish_model.ckpt`` and
``vggish_pca_params.npz`` (``Classification/audio_features_whole.py:31-32``);
this one-time converter turns them into a single npz pytree consumable by
``models.vggish.apply`` / ``train.checkpoints.load``.

Usage:
    python scripts/convert_vggish.py vggish_model.ckpt \
        --pca vggish_pca_params.npz -o vggish_converted
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from icassp2022_depression_tpu.models import vggish  # noqa: E402
from icassp2022_depression_tpu.train import checkpoints  # noqa: E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("ckpt", help="vggish_model.ckpt (TF-slim checkpoint)")
    ap.add_argument("--pca", help="vggish_pca_params.npz")
    ap.add_argument("-o", "--out", default="vggish_converted")
    args = ap.parse_args(argv)

    params = vggish.from_tf_checkpoint(args.ckpt)
    if args.pca:
        post = vggish.load_pca_params(args.pca)
        params = dict(params, pca={"matrix": post.pca_matrix,
                                   "means": post.pca_means.ravel()})
    out = checkpoints.save(args.out, params)
    n = sum(int(np.asarray(v).size)
            for v in __import__("jax").tree_util.tree_leaves(params))
    print(f"wrote {out} ({n:,} params)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
