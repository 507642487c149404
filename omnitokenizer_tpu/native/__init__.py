from .build import get_lib, normalize_u8, crop_normalize_u8, available
