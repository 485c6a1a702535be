"""Config presets, CSV result I/O, plotting style, progress reporting."""
