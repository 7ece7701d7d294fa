"""Command-line entry points (train / eval / deploy / parse_eval_results /
encode / binauralize / preprocess), flag-compatible with the reference CLIs."""
