from fvta_memexqa_tpu.models.embed import CharCNN, Highway, WordEmbed
from fvta_memexqa_tpu.models.fvta import FVTAModel, ModelOutput

__all__ = ["CharCNN", "Highway", "WordEmbed", "FVTAModel", "ModelOutput"]
