from .hive2es import Hive2ESConfig, run_job, build_documents

__all__ = ["Hive2ESConfig", "run_job", "build_documents"]
