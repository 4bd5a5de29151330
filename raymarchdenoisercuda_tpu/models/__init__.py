from .svgf import svgf_denoise_frame, svgf_denoise_sequence, demodulate, remodulate
from .pipeline import render_and_denoise, make_train_step, init_train_state, TrainState
