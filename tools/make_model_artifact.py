"""Export the synthetic encoder's weights as a serialized npz model
artifact (data/model_enc.npz) — the enc_best.onnx analog
(/root/reference/infer_effocr_onnx_multi.py:475-494: the reference ships
its recognizer as a weights file loaded once per process).

The committed artifact holds the DEFAULT-config weights (CROP_SIZE=16,
EMBED_DIM=64) byte-identical to the in-module seeded matrix, so the
drop-in test can assert byte parity end-to-end; regenerating under
EFFOCR_* env overrides exports an artifact for that geometry.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from effocr_spark.functions.crops import CROP_SIZE  # noqa: E402
from effocr_spark.synth import model as synthmodel  # noqa: E402


def main() -> None:
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "model_enc.npz")
    np.savez(out,
             projection=synthmodel._PROJ,
             crop_size=np.int64(CROP_SIZE),
             embed_dim=np.int64(synthmodel.EMBED_DIM))
    print(f"wrote {out}: projection {synthmodel._PROJ.shape} "
          f"for crop_size={CROP_SIZE}/embed_dim={synthmodel.EMBED_DIM}")


if __name__ == "__main__":
    main()
