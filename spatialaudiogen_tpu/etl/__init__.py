"""Offline ETL: dataset download, media preprocessing, projection remaps."""
