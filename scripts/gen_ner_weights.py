"""Generate the committed NER weight fixture (pie_ray/stages/ner_weights.npz)
from the in-code constants — the A7 deployment seam's reference weights.

Run after changing EMISSION_W / TRANSITIONS / START in ner_model.py:

    python scripts/gen_ner_weights.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pie_ray.stages.ner_model import (  # noqa: E402
    DEFAULT_WEIGHTS_PATH,
    EMISSION_W,
    START,
    TRANSITIONS,
)


def main() -> None:
    if os.path.exists(DEFAULT_WEIGHTS_PATH):
        z = np.load(DEFAULT_WEIGHTS_PATH)
        if "trained" in z and "--force" not in sys.argv:
            raise SystemExit(
                f"{DEFAULT_WEIGHTS_PATH} holds TRAINED weights "
                "(scripts/train_ner.py); refusing to overwrite with the "
                "hand-seeded constants. Pass --force to do it anyway."
            )
    np.savez(
        DEFAULT_WEIGHTS_PATH,
        emission_w=EMISSION_W,
        transitions=TRANSITIONS,
        start=START,
    )
    z = np.load(DEFAULT_WEIGHTS_PATH)
    assert np.array_equal(z["emission_w"], EMISSION_W)
    assert np.array_equal(z["transitions"], TRANSITIONS)
    assert np.array_equal(z["start"], START)
    print(f"wrote {DEFAULT_WEIGHTS_PATH} ({os.path.getsize(DEFAULT_WEIGHTS_PATH)} bytes)")


if __name__ == "__main__":
    main()
