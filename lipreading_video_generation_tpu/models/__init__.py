from .vivit import ViViT, FeatureTransformer  # noqa: F401
from .generator import TalkingFaceGenerator  # noqa: F401
from .discriminator import Discriminator, lower_half  # noqa: F401
from .syncnet import SyncNet, stack_window_lower_half  # noqa: F401
from .unet import UNetModel, EncoderUNetModel, SuperResModel  # noqa: F401
from .unet_audio import UNetAudio  # noqa: F401
from .audio_encoder import AudioFeatureEncoder  # noqa: F401
from .schedulers import (  # noqa: F401
    LinearScheduler,
    LinearSchedulerV2,
    CosineScheduler,
    make_scheduler,
)
from .s3fd import S3FD, detect_faces  # noqa: F401
from .face_api import FaceAlignment, LandmarksType  # noqa: F401
from .densenet import DenseNet121  # noqa: F401
from .avhubert import AVHubertVideoEncoder, convert_avhubert_state_dict  # noqa: F401
from .lip_expert import ConformerLipEncoder, avhubert_video_transform  # noqa: F401
