from .frechet import frechet_distance, trace_sqrt_product
from .metrics import psnr, ssim
from .prec_recall import manifold_radii, precision_recall
