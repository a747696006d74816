from quickrank_tpu.io.xml_model import load_model, save_model

__all__ = ["load_model", "save_model"]
