version: 1

scene_parameters {
    output_file_name: "g_combo_ibl.pfm"
    width: 64
    height: 64
    max_depth: 6
    russian_roulette_depth: 3
    integrator: iterative_rrnee
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

material_glossy {
    name: "rough"
    diffuse: 0.6 0.3 0.2
    ior: 1.6
    roughness: 0.4
}

material_lambertian {
    name: "base_lam"
    diffuse: 0.2 0.3 0.7
}

material_clearcoat {
    name: "coat"
    base: "base_lam"
    ior: 1.5
    color: 1.0 0.9 0.9
}

material_glossy {
    name: "shiny"
    diffuse: 0.3 0.6 0.3
    ior: 1.5
    roughness: 0.05
}

mesh {
    file: "blob.ply"
    translate: -0.9 0.0 0.0
    material: "rough"
}

sphere {
    translate: 1.2 1.0 0.3
    material: "coat"
}

sphere {
    translate: 0.3 0.6 1.3
    scale: 0.55 0.55 0.55
    material: "shiny"
}

plane {
    material: "grey"
}

sphere_light {
    translate: 0.0 4.0 0.0
    radiance: 10.0 10.0 10.0
}

environment_light {
    rotate: 0.0 1.0 0.0 30.0
    radiance: 1.0 1.0 1.0
    max_radiance: 50
    image: "env.pfm"
}
