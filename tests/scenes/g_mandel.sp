version: 1

scene_parameters {
    output_file_name: "g_mandel.pfm"
    width: 64
    height: 64
    max_depth: 8
    russian_roulette_depth: 3
    integrator: mandelbrot
}

perspective_camera {
    origin: 0.0 2.0 5.0
    look_at: 0.0 1.0 0.0
    fov: 45
}
