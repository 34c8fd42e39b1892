"""Public-knowledge upazila skeleton: upazila name -> district.

Bangladesh's upazila-level administrative structure (~495 upazilas across
the 64 districts) is public administrative fact; the reference ships the
same structure as ~4 MB of division JSONs (measured 577 entries incl.
variants, ``/root/reference/src/geo/bangladesh_geo_offline.py:58-219``).
This module records names only — district/division attribution comes from
the gazetteer's district->division map, and postal codes are deliberately
NOT fabricated here (entries without a code fall through the prediction
priorities to district-level inference, see ``geo.GeoHierarchy``).

Names that collide with gazetteer AREA names (e.g. the Mirpur upazila of
Kushtia vs. Mirpur, Dhaka) are resolved at merge time in favor of the area
(see ``geo.GeoHierarchy.__init__``): in transcript text the metropolitan
neighborhood reading dominates. Names shared by several districts keep one
deterministic winner (listed district).
"""

# upazila(lower) -> district display name
UPAZILA_SKELETON = {
    # --- Dhaka division ------------------------------------------------
    # Gazipur
    "gazipur sadar": "Gazipur", "tongi": "Gazipur",
    # Narayanganj
    "narayanganj sadar": "Narayanganj",
    # Narsingdi
    "narsingdi sadar": "Narsingdi", "belabo": "Narsingdi",
    "monohardi": "Narsingdi", "palash": "Narsingdi",
    "raipura": "Narsingdi", "shibpur": "Narsingdi",
    # Munshiganj
    "munshiganj sadar": "Munshiganj", "gazaria": "Munshiganj",
    "lohajang": "Munshiganj", "sirajdikhan": "Munshiganj",
    "sreenagar": "Munshiganj", "tongibari": "Munshiganj",
    # Manikganj
    "manikganj sadar": "Manikganj", "ghior": "Manikganj",
    "harirampur": "Manikganj", "saturia": "Manikganj",
    "shivalaya": "Manikganj", "singair": "Manikganj",
    "daulatpur": "Manikganj",
    # Tangail
    "tangail sadar": "Tangail", "basail": "Tangail", "bhuapur": "Tangail",
    "delduar": "Tangail", "dhanbari": "Tangail", "ghatail": "Tangail",
    "gopalpur": "Tangail", "kalihati": "Tangail", "madhupur": "Tangail",
    "mirzapur": "Tangail", "nagarpur": "Tangail", "sakhipur": "Tangail",
    # Kishoreganj
    "kishoreganj sadar": "Kishoreganj", "austagram": "Kishoreganj",
    "bajitpur": "Kishoreganj", "bhairab": "Kishoreganj",
    "hossainpur": "Kishoreganj", "itna": "Kishoreganj",
    "karimganj": "Kishoreganj", "katiadi": "Kishoreganj",
    "kuliarchar": "Kishoreganj", "mithamain": "Kishoreganj",
    "nikli": "Kishoreganj", "pakundia": "Kishoreganj",
    "tarail": "Kishoreganj",
    # Faridpur
    "faridpur sadar": "Faridpur", "alfadanga": "Faridpur",
    "bhanga": "Faridpur", "boalmari": "Faridpur",
    "charbhadrasan": "Faridpur", "madhukhali": "Faridpur",
    "nagarkanda": "Faridpur", "sadarpur": "Faridpur", "saltha": "Faridpur",
    # Gopalganj
    "gopalganj sadar": "Gopalganj", "kashiani": "Gopalganj",
    "kotalipara": "Gopalganj", "muksudpur": "Gopalganj",
    "tungipara": "Gopalganj",
    # Madaripur
    "madaripur sadar": "Madaripur", "kalkini": "Madaripur",
    "rajoir": "Madaripur", "shibchar": "Madaripur",
    # Shariatpur
    "shariatpur sadar": "Shariatpur", "bhedarganj": "Shariatpur",
    "damudya": "Shariatpur", "gosairhat": "Shariatpur",
    "naria": "Shariatpur", "zajira": "Shariatpur",
    # Rajbari
    "rajbari sadar": "Rajbari", "baliakandi": "Rajbari",
    "goalandaghat": "Rajbari", "pangsha": "Rajbari",
    "kalukhali": "Rajbari",
    # Dhaka
    "dhaka sadar": "Dhaka",
    # --- Mymensingh division --------------------------------------------
    "mymensingh sadar": "Mymensingh", "dhobaura": "Mymensingh",
    "gauripur": "Mymensingh", "haluaghat": "Mymensingh",
    "nandail": "Mymensingh", "phulpur": "Mymensingh",
    "tarakanda": "Mymensingh",
    # Jamalpur
    "jamalpur sadar": "Jamalpur", "baksiganj": "Jamalpur",
    "dewanganj": "Jamalpur", "islampur": "Jamalpur",
    "madarganj": "Jamalpur", "melandaha": "Jamalpur",
    "sarishabari": "Jamalpur",
    # Netrokona
    "netrokona sadar": "Netrokona", "atpara": "Netrokona",
    "barhatta": "Netrokona", "durgapur": "Netrokona",
    "khaliajuri": "Netrokona", "kalmakanda": "Netrokona",
    "kendua": "Netrokona", "madan": "Netrokona", "mohanganj": "Netrokona",
    "purbadhala": "Netrokona",
    # Sherpur
    "sherpur sadar": "Sherpur", "jhenaigati": "Sherpur", "nakla": "Sherpur",
    "nalitabari": "Sherpur", "sreebardi": "Sherpur",
    # --- Chattogram division --------------------------------------------
    "chandanaish": "Chattogram", "fatikchhari": "Chattogram",
    "lohagara": "Chattogram", "satkania": "Chattogram",
    "karnaphuli": "Chattogram",
    # Cox's Bazar
    "cox's bazar sadar": "Cox's Bazar", "kutubdia": "Cox's Bazar",
    "maheshkhali": "Cox's Bazar", "pekua": "Cox's Bazar",
    # Comilla
    "comilla adarsha sadar": "Comilla", "comilla sadar dakshin": "Comilla",
    "barura": "Comilla", "brahmanpara": "Comilla", "burichang": "Comilla",
    "chauddagram": "Comilla", "debidwar": "Comilla", "meghna": "Comilla",
    "monohorgonj": "Comilla", "muradnagar": "Comilla",
    "nangalkot": "Comilla", "titas": "Comilla",
    # Brahmanbaria
    "brahmanbaria sadar": "Brahmanbaria", "akhaura": "Brahmanbaria",
    "ashuganj": "Brahmanbaria", "bancharampur": "Brahmanbaria",
    "bijoynagar": "Brahmanbaria", "kasba": "Brahmanbaria",
    "nabinagar": "Brahmanbaria", "nasirnagar": "Brahmanbaria",
    "sarail": "Brahmanbaria",
    # Chandpur
    "chandpur sadar": "Chandpur", "faridganj": "Chandpur",
    "haimchar": "Chandpur", "haziganj": "Chandpur", "kachua": "Chandpur",
    "matlab dakshin": "Chandpur", "matlab uttar": "Chandpur",
    "shahrasti": "Chandpur",
    # Lakshmipur
    "lakshmipur sadar": "Lakshmipur", "kamalnagar": "Lakshmipur",
    "raipur": "Lakshmipur", "ramganj": "Lakshmipur",
    "ramgati": "Lakshmipur",
    # Noakhali
    "noakhali sadar": "Noakhali", "begumganj": "Noakhali",
    "chatkhil": "Noakhali", "hatiya": "Noakhali", "kabirhat": "Noakhali",
    "senbagh": "Noakhali", "sonaimuri": "Noakhali",
    "subarnachar": "Noakhali",
    # Feni
    "feni sadar": "Feni", "chhagalnaiya": "Feni", "daganbhuiyan": "Feni",
    "fulgazi": "Feni", "parshuram": "Feni", "sonagazi": "Feni",
    # Khagrachhari
    "khagrachhari sadar": "Khagrachhari", "dighinala": "Khagrachhari",
    "lakshmichhari": "Khagrachhari", "mahalchhari": "Khagrachhari",
    "manikchhari": "Khagrachhari", "matiranga": "Khagrachhari",
    "panchhari": "Khagrachhari", "ramgarh": "Khagrachhari",
    # Rangamati
    "rangamati sadar": "Rangamati", "baghaichhari": "Rangamati",
    "barkal": "Rangamati", "juraichhari": "Rangamati",
    "belaichhari": "Rangamati", "kaptai": "Rangamati",
    "kawkhali": "Rangamati", "langadu": "Rangamati",
    "naniarchar": "Rangamati", "rajasthali": "Rangamati",
    # Bandarban
    "bandarban sadar": "Bandarban", "alikadam": "Bandarban",
    "lama": "Bandarban", "naikhongchhari": "Bandarban",
    "rowangchhari": "Bandarban", "ruma": "Bandarban",
    "thanchi": "Bandarban",
    # --- Sylhet division -------------------------------------------------
    "sylhet sadar": "Sylhet", "dakshin surma": "Sylhet",
    "fenchuganj": "Sylhet", "gowainghat": "Sylhet", "kanaighat": "Sylhet",
    "osmani nagar": "Sylhet", "zakiganj": "Sylhet",
    # Moulvibazar
    "moulvibazar sadar": "Moulvibazar", "barlekha": "Moulvibazar",
    "juri": "Moulvibazar", "kamalganj": "Moulvibazar",
    "kulaura": "Moulvibazar", "rajnagar": "Moulvibazar",
    "sreemangal": "Moulvibazar",
    # Habiganj
    "habiganj sadar": "Habiganj", "ajmiriganj": "Habiganj",
    "bahubal": "Habiganj", "baniachang": "Habiganj",
    "chunarughat": "Habiganj", "lakhai": "Habiganj",
    "madhabpur": "Habiganj", "nabiganj": "Habiganj",
    "shayestaganj": "Habiganj",
    # Sunamganj
    "sunamganj sadar": "Sunamganj", "bishwamvarpur": "Sunamganj",
    "chhatak": "Sunamganj", "derai": "Sunamganj",
    "dharampasha": "Sunamganj", "dowarabazar": "Sunamganj",
    "jagannathpur": "Sunamganj", "jamalganj": "Sunamganj",
    "sullah": "Sunamganj", "tahirpur": "Sunamganj",
    "shantiganj": "Sunamganj",
    # --- Rajshahi division -----------------------------------------------
    "bagmara": "Rajshahi", "mohanpur": "Rajshahi",
    # Natore
    "natore sadar": "Natore", "bagatipara": "Natore",
    "baraigram": "Natore", "gurudaspur": "Natore", "lalpur": "Natore",
    "singra": "Natore", "naldanga": "Natore",
    # Naogaon
    "naogaon sadar": "Naogaon", "atrai": "Naogaon",
    "badalgachhi": "Naogaon", "dhamoirhat": "Naogaon",
    "mahadebpur": "Naogaon", "niamatpur": "Naogaon",
    "patnitala": "Naogaon", "porsha": "Naogaon", "raninagar": "Naogaon",
    "sapahar": "Naogaon",
    # Chapainawabganj
    "chapainawabganj sadar": "Chapainawabganj",
    "bholahat": "Chapainawabganj", "gomastapur": "Chapainawabganj",
    "nachole": "Chapainawabganj", "shibganj": "Chapainawabganj",
    # Pabna
    "pabna sadar": "Pabna", "atgharia": "Pabna", "bera": "Pabna",
    "bhangura": "Pabna", "chatmohar": "Pabna", "ishwardi": "Pabna",
    "santhia": "Pabna", "sujanagar": "Pabna",
    # Sirajganj
    "sirajganj sadar": "Sirajganj", "belkuchi": "Sirajganj",
    "chauhali": "Sirajganj", "kamarkhanda": "Sirajganj",
    "kazipur": "Sirajganj", "raiganj": "Sirajganj",
    "shahjadpur": "Sirajganj", "tarash": "Sirajganj",
    "ullahpara": "Sirajganj",
    # Bogra
    "bogra sadar": "Bogra", "adamdighi": "Bogra", "dhunat": "Bogra",
    "dhupchanchia": "Bogra", "gabtali": "Bogra", "kahaloo": "Bogra",
    "nandigram": "Bogra", "sariakandi": "Bogra", "shajahanpur": "Bogra",
    "sonatola": "Bogra",
    # Joypurhat
    "joypurhat sadar": "Joypurhat", "akkelpur": "Joypurhat",
    "kalai": "Joypurhat", "khetlal": "Joypurhat",
    "panchbibi": "Joypurhat",
    # --- Khulna division --------------------------------------------------
    "batiaghata": "Khulna", "dacope": "Khulna", "koyra": "Khulna",
    "terokhada": "Khulna",
    # Bagerhat
    "bagerhat sadar": "Bagerhat", "chitalmari": "Bagerhat",
    "fakirhat": "Bagerhat", "mollahat": "Bagerhat", "mongla": "Bagerhat",
    "morrelganj": "Bagerhat", "rampal": "Bagerhat",
    "sarankhola": "Bagerhat",
    # Satkhira
    "satkhira sadar": "Satkhira", "assasuni": "Satkhira",
    "debhata": "Satkhira", "kalaroa": "Satkhira",
    "shyamnagar": "Satkhira", "tala": "Satkhira",
    # Jessore
    "jessore sadar": "Jessore", "abhaynagar": "Jessore",
    "bagherpara": "Jessore", "chaugachha": "Jessore",
    "jhikargachha": "Jessore", "keshabpur": "Jessore",
    "manirampur": "Jessore", "sharsha": "Jessore",
    # Jhenaidah
    "jhenaidah sadar": "Jhenaidah", "harinakunda": "Jhenaidah",
    "kaliganj": "Jhenaidah", "kotchandpur": "Jhenaidah",
    "maheshpur": "Jhenaidah", "shailkupa": "Jhenaidah",
    # Magura
    "magura sadar": "Magura", "shalikha": "Magura",
    # Narail
    "narail sadar": "Narail", "kalia": "Narail",
    # Kushtia
    "kushtia sadar": "Kushtia", "bheramara": "Kushtia",
    "khoksa": "Kushtia", "kumarkhali": "Kushtia",
    # Chuadanga
    "chuadanga sadar": "Chuadanga", "alamdanga": "Chuadanga",
    "damurhuda": "Chuadanga", "jibannagar": "Chuadanga",
    # Meherpur
    "meherpur sadar": "Meherpur", "gangni": "Meherpur",
    "mujibnagar": "Meherpur",
    # --- Barisal division --------------------------------------------------
    "barisal sadar": "Barisal", "agailjhara": "Barisal",
    "hizla": "Barisal", "mehendiganj": "Barisal", "muladi": "Barisal",
    # Bhola
    "bhola sadar": "Bhola", "burhanuddin": "Bhola",
    "char fasson": "Bhola", "daulatkhan": "Bhola", "lalmohan": "Bhola",
    "manpura": "Bhola", "tazumuddin": "Bhola",
    # Patuakhali
    "patuakhali sadar": "Patuakhali", "bauphal": "Patuakhali",
    "dashmina": "Patuakhali", "dumki": "Patuakhali",
    "galachipa": "Patuakhali", "kalapara": "Patuakhali",
    "mirzaganj": "Patuakhali", "rangabali": "Patuakhali",
    # Pirojpur
    "pirojpur sadar": "Pirojpur", "bhandaria": "Pirojpur",
    "mathbaria": "Pirojpur", "nazirpur": "Pirojpur",
    "nesarabad": "Pirojpur", "indurkani": "Pirojpur",
    # Barguna
    "barguna sadar": "Barguna", "amtali": "Barguna", "bamna": "Barguna",
    "betagi": "Barguna", "patharghata": "Barguna", "taltali": "Barguna",
    # Jhalokati
    "jhalokati sadar": "Jhalokati", "kathalia": "Jhalokati",
    "nalchity": "Jhalokati", "rajapur": "Jhalokati",
    # --- Rangpur division --------------------------------------------------
    "rangpur sadar": "Rangpur", "pirganj": "Rangpur",
    "taraganj": "Rangpur",
    # Dinajpur
    "dinajpur sadar": "Dinajpur", "birampur": "Dinajpur",
    "birganj": "Dinajpur", "biral": "Dinajpur", "bochaganj": "Dinajpur",
    "chirirbandar": "Dinajpur", "fulbari": "Dinajpur",
    "ghoraghat": "Dinajpur", "hakimpur": "Dinajpur",
    "kaharole": "Dinajpur", "khansama": "Dinajpur",
    "parbatipur": "Dinajpur",
    # Thakurgaon
    "thakurgaon sadar": "Thakurgaon", "baliadangi": "Thakurgaon",
    "haripur": "Thakurgaon", "ranisankail": "Thakurgaon",
    # Panchagarh
    "panchagarh sadar": "Panchagarh", "atwari": "Panchagarh",
    "boda": "Panchagarh", "debiganj": "Panchagarh",
    "tetulia": "Panchagarh",
    # Nilphamari
    "nilphamari sadar": "Nilphamari", "dimla": "Nilphamari",
    "domar": "Nilphamari", "jaldhaka": "Nilphamari",
    "saidpur": "Nilphamari",
    # Lalmonirhat
    "lalmonirhat sadar": "Lalmonirhat", "aditmari": "Lalmonirhat",
    "hatibandha": "Lalmonirhat", "patgram": "Lalmonirhat",
    # Kurigram
    "kurigram sadar": "Kurigram", "bhurungamari": "Kurigram",
    "char rajibpur": "Kurigram", "chilmari": "Kurigram",
    "nageshwari": "Kurigram", "phulbari": "Kurigram",
    "rajarhat": "Kurigram", "raomari": "Kurigram", "ulipur": "Kurigram",
    # Gaibandha
    "gaibandha sadar": "Gaibandha", "fulchhari": "Gaibandha",
    "gobindaganj": "Gaibandha", "palashbari": "Gaibandha",
    "sadullapur": "Gaibandha", "saghata": "Gaibandha",
    "sundarganj": "Gaibandha",
    # --- remaining Khulna-division sadar entries -------------------------
    "khulna sadar": "Khulna",
    # remaining division sadars commonly written as areas
    "rajshahi sadar": "Rajshahi", "chattogram sadar": "Chattogram",
}
