"""Sphinx configuration (optional — the pages are plain Markdown and render
on GitHub without building; reference parity: /root/reference docs/source/conf.py
role, content written for this framework).

Build with:  pip install sphinx myst-parser && make -C docs html
"""

project = "judo_tpu"
author = "judo_tpu developers"

extensions = ["myst_parser"]
source_suffix = {".md": "markdown"}
master_doc = "index"
exclude_patterns = ["_build"]

html_theme = "alabaster"
html_title = "judo_tpu"
