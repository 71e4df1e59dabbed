from .npy_reader import NumpyShardReader, write_npy_shard
from .token_prefix import TokenPrefixDataset, MultiplePrefixDataset
