from fvta_memexqa_tpu.data.schema import Album, QAPair, parse_album_info, parse_qas
from fvta_memexqa_tpu.data.tokenize import tokenize, word_to_char_ids
from fvta_memexqa_tpu.data.vocab import Vocab, load_glove
from fvta_memexqa_tpu.data.pack import PackedDataset, PackedShared, load_pack, pack
from fvta_memexqa_tpu.data.pipeline import Batch, Dataset
from fvta_memexqa_tpu.data.device_prepro import ModelInputs, SharedTables, assemble
from fvta_memexqa_tpu.data.stream import (Prefetcher, StreamingDataset,
                                           write_shards, write_split_shards)
from fvta_memexqa_tpu.data.synthetic import make_synthetic
from fvta_memexqa_tpu.data.video_pack import VideoDataset, pack_video

__all__ = [
    "Album",
    "QAPair",
    "parse_album_info",
    "parse_qas",
    "tokenize",
    "word_to_char_ids",
    "Vocab",
    "load_glove",
    "PackedDataset",
    "PackedShared",
    "load_pack",
    "pack",
    "Batch",
    "Dataset",
    "ModelInputs",
    "SharedTables",
    "assemble",
    "make_synthetic",
    "Prefetcher",
    "StreamingDataset",
    "write_shards",
    "write_split_shards",
    "VideoDataset",
    "pack_video",
]
