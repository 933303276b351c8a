from .graph import derive_from_documents, generate_site_graph, seeds_for  # noqa: F401
