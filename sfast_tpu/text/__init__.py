from sfast_tpu.text.clip_tokenizer import CLIPTokenizer, find_vocab_files

__all__ = ["CLIPTokenizer", "find_vocab_files"]
