"""Regenerate tests/data/orb_golden.npz (the exact front-end regression pin).

Run on the CPU backend (the deterministic top_k selection path):

    python tools/gen_orb_golden.py

Only regenerate after a DELIBERATE front-end change, and only once the
quality tests (tests/test_orb.py::TestOrbRegression::test_known_shift_recall
and the pipeline suites) pass with the new output — the golden guards
against silent drift, not against reviewed changes.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from mono_slam_framework_tpu.ops import orb
from test_orb import textured_image

SEED = 7
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "data", "orb_golden.npz")


def main():
    img = jnp.asarray(textured_image(np.random.default_rng(SEED)))
    f = orb.extract(img, 300)
    np.savez(
        OUT,
        img_seed=np.int64(SEED),
        xy=np.asarray(f.xy),
        desc=np.asarray(f.desc),
        valid=np.asarray(f.valid),
        octave=np.asarray(f.octave),
        angle=np.asarray(f.angle),
    )
    print(f"wrote {OUT}: {int(np.asarray(f.valid).sum())} valid keypoints")


if __name__ == "__main__":
    main()
