from bliss_tpu.store.feature_store import FeatureStore, similarity_rows

__all__ = ["FeatureStore"]
