from centerpose_tpu.eval.coco_eval import (  # noqa: F401
    COCOProtocolEval,
    KeypointEval,
    evaluate_bboxes,
    evaluate_keypoints,
    summarize_keypoints,
)
