version: 1

scene_parameters {
    output_file_name: "lucy_bench.pfm"
    width: 1350
    height: 2000
    max_depth: 10
    russian_roulette_depth: 3
    integrator: iterative_rrnee
}

perspective_camera {
    origin: 0.0 900.0 -2300.0
    look_at: 0.0 0.0 0.0
    fov: 45
}

material_glossy {
    name: "material_glossy_base"
    diffuse: 0.7 0.7 0.7
    ior: 1.3
    roughness: 0.75
}

material_glossy {
    name: "material_glossy_plane"
    diffuse: 0.4 0.1 0.1
    ior: 1.8
    roughness: 0.01
}

material_clearcoat {
    name: "material_glossy_clearcoat"
    base: "material_glossy_base"
    ior: 1.5
    color: 1.0 1.0 1.0
}

mesh {
    file: "terrain_28m.ply"
    material: "material_glossy_clearcoat"
}

plane {
    material: "material_glossy_plane"
    translate: 0.0 -400.0 0.0
}

environment_light {
    radiance: 1.0 1.0 1.3
}
