from sfast_tpu.training.lora_trainer import make_lora_train_step, lora_training_setup

__all__ = ["make_lora_train_step", "lora_training_setup"]
