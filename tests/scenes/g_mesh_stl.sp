version: 1

scene_parameters {
    output_file_name: "g_mesh_stl.pfm"
    width: 64
    height: 64
    max_depth: 5
    russian_roulette_depth: 3
    integrator: direct_lighting
}

perspective_camera {
    origin: 0.0 2.0 5.0
    look_at: 0.0 1.0 0.0
    fov: 45
}

material_lambertian {
    name: "grey"
    diffuse: 0.5 0.5 0.5
}

material_lambertian {
    name: "red"
    diffuse: 0.7 0.2 0.2
}

mesh {
    file: "ico.stl"
    material: "red"
}

plane {
    material: "grey"
}

sphere_light {
    translate: 0.0 4.0 0.0
    radiance: 10.0 10.0 10.0
}
