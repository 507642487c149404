from .attention import Attention, FeedForward, Pooling, Up, sdpa
from .bias import ContinuousPositionBias, alibi_bias, alibi_slopes
from .codebook import Codebook, vq_argmin, vq_argmin_xla, vq_distances
from .gaussian import DiagonalGaussian
from .norms import LayerNorm, LayerNormGamma
from .peg import PEG
from .rotary import apply_rotary_emb_2d, freqs_cis_2d
from .transformer import Transformer
from .window import WindowAttention, window_partition, window_reverse
