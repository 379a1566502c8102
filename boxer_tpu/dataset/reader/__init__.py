from boxer_tpu.dataset.reader.image_reader import ImageReader
from boxer_tpu.dataset.reader.point_reader import PointReader, WaymoReader

__all__ = ["ImageReader", "PointReader", "WaymoReader"]
