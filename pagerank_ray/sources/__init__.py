from pagerank_ray.sources.pages import generate_pages, synth_pages_dataset  # noqa: F401
