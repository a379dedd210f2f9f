from .fusionnet import FusionNet, FusionNetConfig  # noqa: F401
from .resfusion import ResFusionNet, ResFusionNetConfig  # noqa: F401
from .vggfusion import VGGFusion, VGGFusionConfig  # noqa: F401
