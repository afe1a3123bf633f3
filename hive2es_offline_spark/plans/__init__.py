from .mapping import synthesize_mapping, index_settings_for_load, index_settings_final

__all__ = ["synthesize_mapping", "index_settings_for_load", "index_settings_final"]
