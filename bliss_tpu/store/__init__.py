from bliss_tpu.store.feature_store import FeatureStore

__all__ = ["FeatureStore"]
