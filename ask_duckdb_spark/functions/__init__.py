from .text import char_ngrams, tokens  # noqa: F401
from .vectors import cosine_similarity, dot, l2_norm  # noqa: F401
