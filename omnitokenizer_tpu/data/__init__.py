from .image import ImageDataset
from .video import VideoDataset, load_video_frames
from .loader import DataLoader, JointLoader, VideoData
