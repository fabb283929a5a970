from diner_tpu.evaluation.metrics import (
    psnr,
    ssim,
    mse,
    l1,
    lpips_distance,
    init_lpips_proxy,
    load_lpips_weights,
)
from diner_tpu.evaluation.suite import (
    evaluate_folder,
    compare_evaluations,
    PRED_SUFFIX,
    GT_SUFFIX,
    REF_SUFFIX,
    DEPTH_SUFFIX,
    METRIC_LIMIT_DICT,
)

__all__ = [
    "psnr", "ssim", "mse", "l1", "lpips_distance", "init_lpips_proxy",
    "load_lpips_weights", "evaluate_folder", "compare_evaluations",
    "PRED_SUFFIX", "GT_SUFFIX", "REF_SUFFIX", "DEPTH_SUFFIX",
    "METRIC_LIMIT_DICT",
]
