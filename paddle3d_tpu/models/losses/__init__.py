from .weighted_loss import (SigmoidFocalClassificationLoss,
                            WeightedSmoothL1RegressionLoss,
                            WeightedSoftmaxClassificationLoss,
                            sigmoid_focal_loss, smooth_l1_loss)
from .centernet_loss import FastFocalLoss, L1Loss, RegLoss
from .misc_losses import (DisentangledBox3DLoss, FocalLoss, GIoULoss,
                          IoULoss, WeightedCrossEntropyLoss,
                          binary_focal_loss, giou_2d)
from .common_losses import (CrossEntropyLoss, GaussianFocalLoss,
                            SigmoidCeLoss, SmoothL1Loss, WeightedFocalLoss,
                            WeightedL1Loss, WeightedSmoothL1Loss)
