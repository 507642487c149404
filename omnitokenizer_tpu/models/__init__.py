from .tokenizer import Decoder, Encoder, OmniTokenizerNet
from .wrapper import OmniTokenizerVQGAN
