version: 1

scene_parameters {
    output_file_name: "g_bf.pfm"
    width: 48
    height: 48
    max_depth: 4
    russian_roulette_depth: 3
    integrator: brute_force
}

perspective_camera {
    origin: 0.0 2.0 5.0
    look_at: 0.0 1.0 0.0
    fov: 45
}

material_lambertian {
    name: "blue"
    diffuse: 0.2 0.3 0.7
}

material_lambertian {
    name: "grey"
    diffuse: 0.5 0.5 0.5
}

sphere {
    translate: -0.8 1.0 0.0
    material: "blue"
}

sphere {
    translate: 1.1 0.6 0.8
    scale: 0.6 0.6 0.6
    material: "grey"
}

plane {
    material: "grey"
}

environment_light {
    radiance: 0.6 0.7 0.8
}
