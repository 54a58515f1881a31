from .augment import Augmenter, convert_img_to_float
from .loaders import (
    Cifar10Loader,
    ClassificationListLoader,
    DataLoader,
    DetectionListLoader,
    MnistLoader,
    RegressionListLoader,
    make_loader,
)
from .pipeline import BatchPipeline, ShardedBatchPipeline
from .records import (
    EpochIndexStream,
    ShardedEpochIndexStream,
    RawRecordLoader,
    records_from_loader,
    write_records,
)
