"""Host-side inverse-affine post-processing of decoded detections.

Behavioral spec: reference lib/utils/post_process.py
``multi_pose_post_process`` (SURVEY.md §2 #24): map bbox corners + 17 joints
from output-grid coordinates back through the inverse of the (center, scale)
crop affine to original-image pixels.  Runs on the ~K=100 decoded rows only —
host numpy is the right place (the heavy decode already happened on device).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from centerpose_tpu.ops.image import transform_preds


def multi_pose_post_process(
    dets: np.ndarray, c: List[np.ndarray], s: List[float], h: int, w: int
) -> List[Dict[int, np.ndarray]]:
    """dets [B, K, 40] (grid coords) -> per-image {1: [K, 39]} in image pixels.

    Row layout in: bbox(4) + score(1) + joints(34) + class(1);
    out: bbox(4) + score(1) + joints(34).
    """
    ret = []
    for i in range(dets.shape[0]):
        bbox = transform_preds(dets[i, :, :4].reshape(-1, 2), c[i], s[i], (w, h))
        pts = transform_preds(dets[i, :, 5:39].reshape(-1, 2), c[i], s[i], (w, h))
        top_preds = np.concatenate(
            [
                bbox.reshape(-1, 4),
                dets[i, :, 4:5],
                pts.reshape(-1, 34),
            ],
            axis=1,
        ).astype(np.float32)
        ret.append({1: top_preds})
    return ret
