from ..kernels.bloom import bloom_fpr, optimal_k, optimal_m
from .textnorm import extract_text_scalar, with_extracted_text

__all__ = ["extract_text_scalar", "with_extracted_text", "bloom_fpr",
           "optimal_k", "optimal_m"]
