"""wikipedia_wikidata_ray.pipelines"""
