from centerpose_tpu.eval.coco_eval import KeypointEval, summarize_keypoints  # noqa: F401
