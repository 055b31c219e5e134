from pagerank_ray.functions.extract import extract_page, extract_batch  # noqa: F401
from pagerank_ray.functions.urls import normalize_url  # noqa: F401
