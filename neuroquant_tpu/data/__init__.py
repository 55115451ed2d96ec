from neuroquant_tpu.data.videoset import VideoDataSet  # noqa: F401
