from .frechet import frechet_distance, trace_sqrt_product
from .metrics import psnr, ssim
