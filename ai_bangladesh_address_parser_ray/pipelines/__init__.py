from .linkage import LinkageConfig, run_linkage
