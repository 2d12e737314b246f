from sfast_tpu.models.module import Model

__all__ = ["Model"]
