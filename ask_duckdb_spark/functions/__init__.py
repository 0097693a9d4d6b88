from .vectors import cosine_similarity, dot, l2_norm  # noqa: F401
