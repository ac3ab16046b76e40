"""Engine operators: crawl pipeline stages + training-data ops."""
