from .losses import adopt_weight, hinge_d_loss, logits_laplace, vanilla_d_loss
from .trainer import TokenizerTrainState, TokenizerTrainer
