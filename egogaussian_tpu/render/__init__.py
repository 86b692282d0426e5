from egogaussian_tpu.render.camera import Camera
from egogaussian_tpu.render.project import project_gaussians
from egogaussian_tpu.render.api import render, render_label
