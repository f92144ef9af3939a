from diff_unet_tpu.data.nifti import (  # noqa: F401
    NiftiImage,
    read_nifti,
    write_nifti,
)
from diff_unet_tpu.data.datalist import (  # noqa: F401
    get_class_names,
    load_decathlon_datalist,
)
from diff_unet_tpu.data import transforms as transforms  # noqa: F401
from diff_unet_tpu.data.dataset import CacheDataset, DataLoader  # noqa: F401
