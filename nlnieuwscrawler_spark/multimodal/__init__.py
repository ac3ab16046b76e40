"""Multimodal columns: binary media payloads with typed metadata."""
