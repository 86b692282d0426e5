from egogaussian_tpu.eval.metrics import masked_psnr, masked_ssim, evaluate_metrics
from egogaussian_tpu.eval.lpips import LPIPS, load_lpips_weights
from egogaussian_tpu.eval.render_results import render_results, calculate_metric
