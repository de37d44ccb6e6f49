from deepfilternet_tpu.utils.audio_io import load_audio, save_audio  # noqa: F401
