"""Command-line entry points: optimize / train / preprocess / introspect."""
