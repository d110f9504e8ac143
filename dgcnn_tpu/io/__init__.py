"""Point-cloud file I/O: native LAS reader/writer and HDF5 reader.

The reference delegates LAS to laspy and HDF5 to h5py
(/root/reference/prepare_data/process_data.py:17-158); here LAS 1.1-1.4
parsing/writing is implemented directly on numpy structured arrays (no
external dependency, bulk-vectorised decode).
"""

from dgcnn_tpu.io.las import LasData, read_las, write_las
from dgcnn_tpu.io.h5 import read_h5_pointcloud

__all__ = ["LasData", "read_las", "write_las", "read_h5_pointcloud"]
